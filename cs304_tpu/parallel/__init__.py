"""Multi-chip parallelism: device mesh, sharded E-step/decode, collectives."""
