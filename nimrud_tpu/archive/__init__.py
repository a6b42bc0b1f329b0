from nimrud_tpu.archive import io, store
from nimrud_tpu.archive.store import CloudArchive

__all__ = ["CloudArchive", "io", "store"]
