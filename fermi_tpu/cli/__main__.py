import sys

from fermi_tpu.cli.main import main

sys.exit(main())
