"""Crawl-core and pipeline operators (DataFrame-native)."""
