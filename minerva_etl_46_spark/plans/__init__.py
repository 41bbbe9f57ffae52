"""Incremental plans: the engine-owned scheduling layer above Catalyst
(SURVEY.md §4: 'incremental recompute is NOT in Catalyst — this is the
single biggest piece of engine code we own')."""
