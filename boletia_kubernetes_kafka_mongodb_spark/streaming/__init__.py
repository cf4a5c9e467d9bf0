"""Streaming layer: topic router + loop-breaker, per-key admission state,
idempotent foreachBatch MERGE sinks (SURVEY.md §7 Phases 3-4)."""
