"""Streaming tier (SURVEY.md §2.8).

Each operator exists in two forms sharing one transformation body:
- a batch form over the static events table (oracle-checkable, registered
  in ``batch_forms``), and
- a Structured Streaming form (``runtime``) driven by ``readStream`` with
  watermarks/checkpoints, exercised by tests with ``availableNow`` triggers.
"""
