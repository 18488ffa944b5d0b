from yoho_tpu.nn.whisper import Whisper  # noqa: F401
from yoho_tpu.nn.yoho import YOHOModel  # noqa: F401
