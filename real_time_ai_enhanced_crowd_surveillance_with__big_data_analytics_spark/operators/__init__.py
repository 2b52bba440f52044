from .edge_trigger import rising_edges  # noqa: F401
from .topk import topk_per_group  # noqa: F401
