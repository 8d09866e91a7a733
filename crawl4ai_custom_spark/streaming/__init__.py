"""Incremental emission of crawl results (reference 'stream mode' parity)."""
