from volym_tpu.cli import main

raise SystemExit(main())
