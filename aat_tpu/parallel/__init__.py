"""Device mesh + sharding rules (dp/fsdp/tp) for pjit training."""
