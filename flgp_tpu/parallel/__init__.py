"""Multi-device sharding: meshes, sharded spectral stage, chain-parallel MCMC."""
