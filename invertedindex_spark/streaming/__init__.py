from .incremental import append_batch, compact, start_incremental_build

__all__ = ["append_batch", "compact", "start_incremental_build"]
