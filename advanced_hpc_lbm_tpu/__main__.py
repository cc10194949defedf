import sys

from advanced_hpc_lbm_tpu.cli import main

sys.exit(main())
