"""Operator library — the reference's relational-ish operator set
(SURVEY.md §2) re-expressed as composable DataFrame transforms."""
