"""Shared mutable crawl state: URL-seen shards, politeness, checkpoints."""
