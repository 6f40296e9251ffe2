"""Operator library: time windows, fill, event windows, joins, interp."""
