"""Structured Streaming mode (SURVEY.md §2.9).

The reference has no streaming engine — its materialization loop is
incremental micro-batch [H]. Here the SAME aggregation builders run under
``readStream``: batch parity proves semantics, streaming proves the
operators hold under incremental execution.
"""
