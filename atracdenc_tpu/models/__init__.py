"""Codec pipelines (the 'model families' of this framework)."""
