# myria3d_tpu — TPU VM image (reference Dockerfile analog; the reference
# builds a CUDA conda image, here the base is a JAX TPU image).
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY myria3d_tpu ./myria3d_tpu
COPY configs ./configs
COPY run.py bench.py __graft_entry__.py ./
COPY tests ./tests
COPY docs ./docs

# jax[tpu] pinned to the validated stack; everything else is pure python.
RUN pip install --no-cache-dir -U pip \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint h5py pyyaml numpy scipy pandas pytest \
    && pip install --no-cache-dir -e .

# smoke test: CLI help path composes configs (reference Dockerfile:31)
RUN python -m myria3d_tpu._version \
    && JAX_PLATFORMS=cpu python -c "from myria3d_tpu.utils.config import compose; compose('configs')" \
    && echo OK

CMD ["python", "run.py", "--help"]
