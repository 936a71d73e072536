from .pipe import FileMod, Executor, KirPipe
from .graphkir_tool import GraphKirTool
