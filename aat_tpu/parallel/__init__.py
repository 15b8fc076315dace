"""Device mesh + sharding rules (dp/fsdp/tp/sp/pp), Ulysses sequence-
parallel attention (sequence.py), GPipe pipeline combinator (pipeline.py)."""
