from .mesh import stream_mesh, shard_streams, batch_sharding  # noqa: F401
