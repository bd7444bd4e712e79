from .alerts import percolate_batch_to, percolate_stream
from .incremental import (append_batch, compact, delete_docs,
                          delete_docs_where, start_incremental_build,
                          upsert_docs)
from .shards import merge_warehouses
from .snapshot import snapshot_warehouse

__all__ = ["append_batch", "compact", "delete_docs",
           "delete_docs_where", "merge_warehouses",
           "percolate_batch_to", "percolate_stream",
           "snapshot_warehouse", "start_incremental_build",
           "upsert_docs"]
