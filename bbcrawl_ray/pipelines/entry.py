"""Flagship pipeline for the driver's smoke check (``__ray_entry__.entry``)."""

from __future__ import annotations


def flagship(sf_dir: str):
    """Placeholder flagship until the crawl pipeline lands: the partial-
    aggregate pricing summary (exercises read → map_batches → combine →
    groupby → aggregate)."""
    from .queries import q_pricing_summary

    return q_pricing_summary(sf_dir)
