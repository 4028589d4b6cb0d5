from gddim_tpu.ops.attention import self_attention_2d
