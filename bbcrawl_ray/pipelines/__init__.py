"""Pipeline composition: the crawl epoch driver and generic relational ops."""
