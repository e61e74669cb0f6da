from tstar_tpu.video.decoder import (  # noqa: F401
    Cv2Decoder,
    NativeDecoder,
    VideoMeta,
    open_video,
)
from tstar_tpu.video.cache import build_frame_cache  # noqa: F401
