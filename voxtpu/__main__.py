from voxtpu.cli import main

raise SystemExit(main())
