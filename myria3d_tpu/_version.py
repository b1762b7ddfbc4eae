"""Single source of package version.

Mirrors the reference's ``myria3d/_version.py:1-5`` (printable via
``python -m myria3d_tpu._version``, used for image tagging in CI).
"""

__version__ = "0.5.0"

if __name__ == "__main__":
    print(__version__)
