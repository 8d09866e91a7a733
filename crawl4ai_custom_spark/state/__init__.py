"""Crawl state: wave checkpoint snapshots (frontier, seen, host_state, bloom)."""
