from gddim_tpu.data.pipelines import (
    get_dataset,
    get_data_scaler,
    get_data_inverse_scaler,
    get_data_shape,
)
from gddim_tpu.data.pointset import olympic_generate_sample
