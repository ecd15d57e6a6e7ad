"""Operator implementations: windows, aggregates, joins, SASE+, dedup, text."""
