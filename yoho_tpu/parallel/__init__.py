from yoho_tpu.parallel.mesh import (  # noqa: F401
    AXIS_DATA,
    AXIS_MODEL,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from yoho_tpu.parallel.sharding import (  # noqa: F401
    PartitionRules,
    WHISPER_RULES,
    YOHO_RULES,
    partition_specs,
    shard_params,
)
from yoho_tpu.parallel.ring_attention import ring_attention  # noqa: F401
from yoho_tpu.parallel.long_encoder import (  # noqa: F401
    make_long_context_train_step,
    yoho_encode_long,
)
from yoho_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_train_step,
    pipeline_encode,
)
