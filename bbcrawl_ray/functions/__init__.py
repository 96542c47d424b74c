"""Scalar / vectorized functions shared by stages (URL, naming, text)."""
