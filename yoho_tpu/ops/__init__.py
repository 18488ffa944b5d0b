from yoho_tpu.ops.flash_attention import flash_attention  # noqa: F401
from yoho_tpu.ops.mel_kernel import fused_log_mel  # noqa: F401
