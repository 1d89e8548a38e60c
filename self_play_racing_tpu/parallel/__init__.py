"""Device mesh / sharding / multi-host scaling utilities."""
