"""Placeholder — populated as the subsystem lands (see SURVEY.md §7)."""
