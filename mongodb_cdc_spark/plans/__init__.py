"""Physical-plan inspection utilities: the engine's "did Catalyst do what
we designed for" layer."""
