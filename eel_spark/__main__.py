from eel_spark.cli import main

raise SystemExit(main())
