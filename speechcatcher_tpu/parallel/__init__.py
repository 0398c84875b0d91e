"""Multi-chip parallelism: device meshes, parameter/batch sharding rules."""
