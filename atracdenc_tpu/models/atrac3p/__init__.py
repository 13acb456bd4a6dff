"""ATRAC3+ codec (TPU-native encoder + QA decoder)."""
