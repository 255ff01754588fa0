from .txnlog import ConcurrentModificationError, TxnTable

__all__ = ["TxnTable"]
