from .mesh import (
    SITE_AXIS,
    VAR_AXIS,
    shard_sites,
    sharded_first_eof,
    sharded_pairwise_corr,
    sharded_rotation_apply,
    site_mesh,
    site_sharding,
)
