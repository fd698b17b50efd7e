"""Multi-chip layer: device meshes, parameter/cache shardings, and ICI
collectives — the scope where the reference's DSM cluster primitive
reappears on TPU (SURVEY.md §2.4: intra-cluster DSM → intra-core scratch;
cross-chip → ICI collectives)."""

from clusterfusion_tpu.parallel.mesh import build_mesh
from clusterfusion_tpu.parallel.sharding import (
    param_pspecs,
    param_shardings,
    cache_pspec,
    cache_shardings,
    shard_params,
)
from clusterfusion_tpu.parallel.decode import make_sharded_decode_step, make_sharded_serving_step
from clusterfusion_tpu.parallel.sp_decode import (
    cache_pspec_2d,
    cache_shardings_2d,
    make_sp_sharded_decode_step,
)
from clusterfusion_tpu.parallel.collective import (
    Stage,
    cluster_gather,
    cluster_reduce,
)
from clusterfusion_tpu.parallel.pp import (
    make_pp_train_step,
    pipeline_lm_loss,
    pp_param_shardings,
    shard_params_pp,
)
from clusterfusion_tpu.parallel.ep import make_ep_moe_ffn
