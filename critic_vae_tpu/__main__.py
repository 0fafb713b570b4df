import sys

from critic_vae_tpu.cli import main

sys.exit(main())
