"""Per-subject model constants as a flax 'subject' variable collection.

Model modules embed subject metadata — the canonical AABB, SMPL template
tables — as Python attributes, i.e. trace-time constants. That is right
for one subject, but multi-subject batched training (SURVEY §7 step 6,
BASELINE config 5) vmaps ONE program over a stacked subject axis, so
anything that varies per subject must be a traced INPUT.

`subject_const(mod, name, value)` three-ways:
  * at init: registers `value` in the 'subject' collection (so it rides
    `converter.init` into the variables dict, stacks across subjects, and
    shards over the mesh 'data' axis like any other leaf);
  * at apply WITH the collection present (the normal case — callers pass
    the whole variables dict from init): returns the traced value;
  * at apply WITHOUT the collection (old checkpoints via the lenient
    restore, direct param-subtree applies): falls back to the static
    attribute — the exact pre-refactor behavior.

The converter optimizer labels the whole collection 'frozen'
(optax.set_to_zero in scene.converter_optimizer), so the constants are
carried, stacked, and checkpointed but never trained."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def subject_const(mod, name: str, value):
    """Read a per-subject constant through the 'subject' collection.

    `value` may be any pytree of arrays (e.g. an AABB dataclass or a dict
    of SMPL tables); it is used as the init/fallback."""
    init = lambda: jax.tree.map(jnp.asarray, value)
    if mod.has_variable('subject', name):
        return mod.get_variable('subject', name)
    if mod.is_mutable_collection('subject'):
        return mod.variable('subject', name, init).value
    return init()
