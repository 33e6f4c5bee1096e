from iron_tpu.utils.logging import MetricsWriter, concatenate_result, ExperimentDir
