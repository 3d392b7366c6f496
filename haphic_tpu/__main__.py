import sys

from haphic_tpu.cli import main

if __name__ == '__main__':
    sys.exit(main())
