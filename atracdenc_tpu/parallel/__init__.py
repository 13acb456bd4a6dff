"""Device-mesh sharding of the batch transcoder."""
