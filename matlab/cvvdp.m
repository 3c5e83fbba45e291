classdef cvvdp
    % Matlab wrapper for the TPU ColorVideoVDP command-line tool.
    %
    % Example:
    %   v = cvvdp( 'cvvdp' );   % name of the python env with cvvdp-tpu
    %   img_ref = imread( 'wavy_facade.png' );
    %   img_test = imnoise( img_ref, 'gaussian', 0, 0.001 );
    %   v.cmp( img_test, img_ref, 'standard_fhd' )
    %
    % Content is handed to the CLI through temporary .mat files (the CLI's
    % .mat video source); options mirror `cvvdp --help`.

    properties
        python_env
    end

    methods
        function obj = cvvdp(python_env)
            % python_env - name of the conda/venv environment in which the
            %              cvvdp-tpu package is installed
            obj.python_env = python_env;
        end

        function [jod, heatmap] = cmp(obj, img_test, img_ref, display, options)
            arguments
                obj
                img_test {mustBeReal}
                img_ref {mustBeReal}
                display = 'standard_4k'
                options.fps (1,1) {mustBePositive} = 30
                options.ppd (1,1) {mustBeNumeric} = -1
                options.heatmap {mustBeMember(options.heatmap, ...
                    {'none','raw','threshold','supra-threshold'})} = 'none'
                options.verbose (1,1) = false
            end

            tmp_dir = tempname;
            mkdir(tmp_dir);
            test_file = fullfile(tmp_dir, 'test.mat');
            ref_file = fullfile(tmp_dir, 'ref.mat');
            I_vid = img_test; save(test_file, 'I_vid', '-v7');
            I_vid = img_ref;  save(ref_file, 'I_vid', '-v7');

            cmd = sprintf(['conda run -n %s cvvdp --test "%s" --ref "%s" ' ...
                '--display "%s" --heatmap %s --quiet -o "%s"'], ...
                obj.python_env, test_file, ref_file, display, ...
                options.heatmap, tmp_dir);
            if ndims(img_test) > 3
                cmd = sprintf('%s --fps %g', cmd, options.fps);
            end
            if options.ppd > 0
                cmd = sprintf('%s --pix-per-deg %g', cmd, options.ppd);
            end
            if options.verbose
                fprintf(1, '%s\n', cmd);
            end

            [status, out] = system(cmd);
            if status ~= 0
                error('cvvdp:cli', 'cvvdp failed: %s', out);
            end
            lines = strsplit(strtrim(out), newline);
            jod = str2double(lines{end});

            heatmap = [];
            if ~strcmp(options.heatmap, 'none')
                hm_file = fullfile(tmp_dir, 'test_heatmap.png');
                if isfile(hm_file)
                    heatmap = imread(hm_file);
                end
            end
            rmdir(tmp_dir, 's');
        end
    end
end
