from gddim_tpu.evals.fid import (
    frechet_distance,
    inception_score,
    activation_stats,
    load_dataset_stats,
    kernel_distance,
)
from gddim_tpu.evals.features import get_feature_extractor, run_features_sharded
