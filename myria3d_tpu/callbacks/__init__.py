"""callbacks — metrics, logging, checkpointing, early stopping, finetuning."""
