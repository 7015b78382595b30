"""Operator library: each module maps a block of SURVEY.md §2's inventory."""
