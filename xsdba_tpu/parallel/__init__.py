from .mesh import SITE_AXIS, VAR_AXIS, shard_sites, site_mesh, site_sharding
