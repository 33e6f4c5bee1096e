from iron_tpu.train.schedules import warmup_cosine_schedule, cos_anneal_ratio
from iron_tpu.train.checkpoints import (save_checkpoint, load_checkpoint, latest_checkpoint,
                                        stage1_to_stage2, AsyncCheckpointer)
from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.train.stage1_multispectral import MultiSpectralConfig, MultiSpectralStage1Trainer
from iron_tpu.train.curriculum import CurriculumTrainer, CurriculumPhase
from iron_tpu.train.nerf_runner import NeRFRunnerConfig, HashNeRFTrainer
