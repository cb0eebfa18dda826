"""Device-mesh parallelism: batched rollout sharding (DP) and intra-scene
particle sharding (see SURVEY.md §2.6 TPU-native mapping)."""

from .intra import make_intra_sharded_step_fn, pad_state_for_mesh
from .intra_grid import make_grid_intra_step_fn
from .sharding import make_mesh, make_sharded_step_fn, replicate_scene, shard_batch
