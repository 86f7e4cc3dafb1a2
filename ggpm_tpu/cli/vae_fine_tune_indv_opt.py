"""Per-subnetwork-optimizer fine-tuning driver (reference
/root/reference/vae_fine_tune_indv_opt.py) — encoder/decoder/HOMO-head/
LUMO-head each get their own Adam + exponential decay
(``make_multi_optimizer``).  Thin wrapper over vae_fine_tune --indv-opt."""

from __future__ import annotations

from .vae_fine_tune import main as _main


def main(argv=None):
    argv = list(argv) if argv is not None else None
    if argv is None:
        import sys
        argv = sys.argv[1:]
    if '--indv-opt' not in argv:
        argv = argv + ['--indv-opt']
    return _main(argv)


if __name__ == '__main__':
    main()
