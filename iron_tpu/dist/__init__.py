from iron_tpu.dist.mesh import make_mesh, replicate, shard_batch
from iron_tpu.dist.train import (make_dp_stage1_step, stage1_param_shardings,
                                 make_dp_stage2_step)
