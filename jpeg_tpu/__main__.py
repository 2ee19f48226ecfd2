from jpeg_tpu.cli import main

raise SystemExit(main())
