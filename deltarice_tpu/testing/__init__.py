from .oracle import ReferenceOracle, oracle_available

__all__ = ["ReferenceOracle", "oracle_available"]
