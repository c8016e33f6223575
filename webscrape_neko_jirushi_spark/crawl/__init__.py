"""Crawl engine: epoch loop, bloom seen-set, politeness, snapshots, oracle."""
