"""Dataset stages: fetch, parse/extract, download, dedup, similarity, text."""
