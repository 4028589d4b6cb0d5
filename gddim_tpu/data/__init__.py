from gddim_tpu.data.pipelines import (
    get_dataset,
    get_data_scaler,
    get_data_inverse_scaler,
    get_data_shape,
    load_tfrecord_images,
    preprocess_corpus,
    write_tfrecord_images,
)
from gddim_tpu.data.pointset import olympic_generate_sample
