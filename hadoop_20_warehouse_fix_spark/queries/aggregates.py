"""Placeholder — queries land in a subsequent milestone."""
