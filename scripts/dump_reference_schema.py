"""Pin the reference checkpoint state_dict schema the converter expects.

Builds every reference torch model family from the reference configs
(singlespeaker + multispeaker YAML) and writes key -> shape for each
state_dict to tests/resources/reference_state_dict_schema.json, together
with a sha256 over the canonical serialization. The published checkpoints
(`forward_step90k.pt`, `thorsten_fastpitch_50k.pt`) carry exactly these
state_dict layouts (reference utils/checkpoints.py:13-23 puts the plain
``model.state_dict()`` under 'model'), so the pinned schema is the
documented contract of utils/convert.py — and
tests/test_checkpoint_ingestion.py asserts the converter still maps every
pinned key onto the flax tree.

Run from the repo root: python scripts/dump_reference_schema.py
"""

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, '/root/reference')

OUT = REPO / 'tests' / 'resources' / 'reference_state_dict_schema.json'


def main():
    from models.fast_pitch import FastPitch
    from models.forward_tacotron import ForwardTacotron
    from models.multi_fast_pitch import MultiFastPitch
    from models.multi_forward_tacotron import MultiForwardTacotron
    from models.tacotron import Tacotron

    from forwardtacotron_tpu.utils.files import read_config

    single = read_config('/root/reference/configs/singlespeaker.yaml')
    multi = read_config('/root/reference/configs/multispeaker.yaml')

    models = {
        'forward_tacotron': ForwardTacotron.from_config(single),
        'fast_pitch': FastPitch.from_config(single),
        'multi_forward_tacotron': MultiForwardTacotron.from_config(multi),
        'multi_fast_pitch': MultiFastPitch.from_config(multi),
        'tacotron': Tacotron.from_config(single),
    }
    schema = {}
    for name, model in models.items():
        schema[name] = {k: list(v.shape)
                        for k, v in model.state_dict().items()}

    canonical = json.dumps(schema, sort_keys=True,
                           separators=(',', ':')).encode()
    doc = {
        '_comment': 'key->shape contract of reference model state_dicts; '
                    'regenerate with scripts/dump_reference_schema.py',
        'sha256': hashlib.sha256(canonical).hexdigest(),
        'models': schema,
    }
    OUT.write_text(json.dumps(doc, indent=1, sort_keys=True))
    n = sum(len(v) for v in schema.values())
    print(f'wrote {OUT} ({n} keys across {len(schema)} models, '
          f'sha256 {doc["sha256"][:16]}...)')


if __name__ == '__main__':
    main()
