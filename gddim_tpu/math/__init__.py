from gddim_tpu.math.cld_host import CLDParams, HostCLD
from gddim_tpu.math.cld import CLD
from gddim_tpu.math import deis
