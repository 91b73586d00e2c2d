@echo off
rem Installs composer-tpu into a fresh virtualenv on Windows (the venv
rem equivalent of the reference's conda installer, reference
rem scripts/install_composer.bat). TPU runtimes are not available on
rem Windows, so this always installs CPU JAX; it is intended for codec /
rem data-pipeline work and for driving remote TPU jobs.
rem
rem   scripts\install_composer.bat [envdir]
rem
rem After install: <envdir>\Scripts\activate && composer --help

setlocal ENABLEDELAYEDEXPANSION

set "ENVDIR=%~1"
if "%ENVDIR%"=="" set "ENVDIR=.venv"
set "REPO=%~dp0.."

where python >nul 2>nul
if errorlevel 1 (
    call :print_error "python not found on PATH (install Python >= 3.10)"
    exit /B 1
)

python -c "import sys; sys.exit(0 if sys.version_info >= (3, 10) else 1)"
if errorlevel 1 (
    call :print_error "python >= 3.10 required"
    exit /B 1
)

if not exist "%ENVDIR%" (
    echo - creating virtualenv at %ENVDIR%
    python -m venv "%ENVDIR%"
    if errorlevel 1 (
        call :print_error "could not create the virtualenv"
        exit /B 1
    )
)

call "%ENVDIR%\Scripts\activate.bat"

echo - installing composer-tpu (editable) + dependencies
python -m pip install --upgrade pip >nul
python -m pip install jax
python -m pip install --editable "%REPO%"
if errorlevel 1 (
    call :print_error "pip install failed"
    exit /B 1
)

rem The native codec needs a C++ toolchain; without one the pure-Python
rem paths are used automatically, so a failure here is non-fatal.
where g++ >nul 2>nul
if not errorlevel 1 (
    echo - prebuilding the native codec
    python -c "import composer_tpu.native.loader" || echo   (native build failed; pure-Python paths remain fully functional)
) else (
    echo - g++ not found; skipping the native codec (pure-Python paths used)
)

echo - smoke check
composer --help >nul
if errorlevel 1 (
    call :print_error "console script did not install"
    exit /B 1
)

echo.
echo ==============================
echo composer-tpu installed.
echo.
echo Activate with:   %ENVDIR%\Scripts\activate
echo Then run:        composer --help
echo ==============================
echo.

exit /B 0

:print_error
    echo %date%T%time%: %~1
    echo.
    echo ==================================================
    echo Installation did not finish successfully.
    echo ==================================================
    echo.
goto:eof
