"""Source adapters: external working sets synced into the engine."""
