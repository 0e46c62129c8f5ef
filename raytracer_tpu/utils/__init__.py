"""Utilities: runtime stats, named timers, PNG IO, config."""
