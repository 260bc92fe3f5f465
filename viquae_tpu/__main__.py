from viquae_tpu.cli import main

main()
