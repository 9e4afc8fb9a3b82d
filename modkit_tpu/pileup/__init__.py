"""Pileup engine: modBAM -> bedMethyl per-position count aggregation."""
