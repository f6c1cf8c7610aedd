"""Structured Streaming layer — the reference pipeline's actual runtime
shape (js:248-382) re-expressed on Spark's engine: change-feed source ->
op-type filter -> micro-batches -> idempotent upsert sink, with native
checkpointing replacing the reference's hand-rolled resume-token file
(js:93-117) and a listener replacing its health checker (js:541-605).
"""
