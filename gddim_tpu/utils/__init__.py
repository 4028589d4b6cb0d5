from gddim_tpu.utils.io import cache_dir, content_key, load_npz_cache, save_npz_cache
from gddim_tpu.utils.tree import flatten_config
