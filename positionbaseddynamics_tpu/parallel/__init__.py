"""Device-mesh parallelism: batched rollout sharding (DP) and intra-scene
particle sharding (see SURVEY.md §2.6 TPU-native mapping)."""

from .sharding import make_mesh, shard_batch, make_sharded_step_fn
