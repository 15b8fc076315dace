"""Utilities: torch checkpoint porting, timing, logging/tracking."""
