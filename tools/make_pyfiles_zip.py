"""Package redactify_spark for spark-submit --py-files."""
import os
import sys
import zipfile


def make_zip(out_path: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "redactify_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(make_zip(sys.argv[1] if len(sys.argv) > 1
                   else "/tmp/redactify_spark.zip"))
