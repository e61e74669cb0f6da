from tstar_tpu.grounding.universal import UniversalGrounder, TStarUniversalGrounder  # noqa: F401
from tstar_tpu.grounding.fake import FakeGrounder  # noqa: F401
from tstar_tpu.grounding.prompts import normalize_object_name  # noqa: F401
