"""Host-side tooling: CLIFF-input preprocessing, skeleton overlays, and the
custom-dataset build pipeline (reference: common/ and build_dataset/)."""
from . import cliff, skeleton, build_dataset  # noqa: F401
