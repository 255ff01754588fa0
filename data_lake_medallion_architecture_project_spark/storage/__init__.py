from .txnlog import TxnTable

__all__ = ["TxnTable"]
