from .repo_files import generate_repo_files, repo_files_schema  # noqa: F401
from .generators import erdos_renyi, rmat  # noqa: F401
from .text import read_net  # noqa: F401
from .xs1 import read_xs1  # noqa: F401
from .registry import load_edges  # noqa: F401
