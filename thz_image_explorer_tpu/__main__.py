from thz_image_explorer_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
