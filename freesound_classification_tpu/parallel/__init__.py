"""Device mesh construction and sharding rules (pjit/NamedSharding DP)."""
