"""Multi-chip sharding of NUFFT transforms (see sharded module)."""
