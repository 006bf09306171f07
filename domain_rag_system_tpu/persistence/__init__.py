from domain_rag_system_tpu.persistence.bundle import (
    IndexBundle,
    load_index,
    save_index,
    snapshot_index,
)

__all__ = ["IndexBundle", "save_index", "load_index", "snapshot_index"]
