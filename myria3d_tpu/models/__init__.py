"""models — neural nets, task-level train/eval state, interpolation."""
