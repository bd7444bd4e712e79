from .incremental import (append_batch, compact, delete_docs,
                          delete_docs_where, start_incremental_build,
                          upsert_docs)

__all__ = ["append_batch", "compact", "delete_docs",
           "delete_docs_where", "start_incremental_build",
           "upsert_docs"]
