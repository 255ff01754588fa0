from .txnlog import ConcurrentModificationError, TxnTable, clone_shallow

__all__ = ["TxnTable", "clone_shallow"]
