from pings_tpu.cli import main

main()
