from scope_tpu.compression.policies import compress_prefill, PrefillResult
from scope_tpu.compression.schedulers import (DecodeCaps, SchedState,
                                              decode_schedule,
                                              static_keep_cap)
