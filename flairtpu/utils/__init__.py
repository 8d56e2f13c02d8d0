"""Shared utilities: stdout tee logger, config recap, seeding."""
