from . import build

if __name__ == "__main__":
    build()
    print("built libs2d_host.so")
